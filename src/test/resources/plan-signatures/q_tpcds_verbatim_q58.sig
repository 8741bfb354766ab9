TakeOrderedAndProject
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
                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
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
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
          Filter
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
