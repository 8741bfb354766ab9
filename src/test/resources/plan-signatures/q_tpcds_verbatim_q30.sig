TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        HashAggregate
          Exchange
            HashAggregate
              HashAggregate
                Exchange
                  HashAggregate
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_returns
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
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
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_returns
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
