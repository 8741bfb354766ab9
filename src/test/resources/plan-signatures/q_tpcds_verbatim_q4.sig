TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
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
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
          Project
            BroadcastHashJoin [broadcast,plain]
              HashAggregate
                Exchange
                  HashAggregate
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
              Project
                BroadcastHashJoin [broadcast,plain]
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                  Filter
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
