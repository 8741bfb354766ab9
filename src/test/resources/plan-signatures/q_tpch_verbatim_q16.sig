Sort
  Exchange
    HashAggregate
      Exchange
        HashAggregate
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.partsupp
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.supplier
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.part
