Exchange
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        ColumnarToRow
          Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.supplier
      Filter
        HashAggregate
          Exchange
            HashAggregate
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
