HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.part
          Project
            Filter
              ColumnarToRow
                Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
