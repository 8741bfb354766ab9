Sort
  Exchange
    HashAggregate
      Exchange
        HashAggregate
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_ssbv_v.part
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_ssbv_v.date
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_ssbv_v.lineorder
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_ssbv_v.supplier
