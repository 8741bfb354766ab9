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
                                      Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.call_center
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
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
                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.call_center
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
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
                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.call_center
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
