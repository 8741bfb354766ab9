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
                          Scan parquet spark_catalog.graft_tpchv_v.partsupp
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpchv_v.supplier
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpchv_v.part
