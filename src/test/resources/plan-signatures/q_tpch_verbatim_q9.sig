Sort
  Exchange
    HashAggregate
      Exchange
        HashAggregate
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.partsupp
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.orders
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.nation
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.supplier
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.part
