TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.partsupp
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.partsupp
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.supplier
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.nation
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.region
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.part
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.supplier
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.nation
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.region
