TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
            Project
              Filter
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
