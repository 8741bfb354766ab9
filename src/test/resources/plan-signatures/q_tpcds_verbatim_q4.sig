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
                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.web_sales
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
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.web_sales
          Project
            BroadcastHashJoin [broadcast,plain]
              HashAggregate
                Exchange
                  HashAggregate
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
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
                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                  Filter
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
