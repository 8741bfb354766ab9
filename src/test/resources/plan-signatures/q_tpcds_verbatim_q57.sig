TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            Filter
              Window
                Filter
                  Window
                    Sort
                      Exchange
                        HashAggregate
                          Exchange
                            HashAggregate
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.call_center
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
          Project
            Window
              Sort
                Exchange
                  HashAggregate
                    Exchange
                      HashAggregate
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.call_center
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
      Project
        Window
          Sort
            Exchange
              HashAggregate
                Exchange
                  HashAggregate
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.call_center
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
