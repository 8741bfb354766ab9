TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
            Project
              Filter
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
