Exchange
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        ColumnarToRow
          Scan parquet spark_catalog.graft_tpchv_v.supplier
      Filter
        HashAggregate
          Exchange
            HashAggregate
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_v.lineitem
