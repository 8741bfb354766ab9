TakeOrderedAndProject
  BroadcastHashJoin [broadcast,plain]
    Filter
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                BroadcastHashJoin [broadcast,plain]
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                                            Project
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.web_sales
                                          Project
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                Project
                  BroadcastHashJoin [broadcast,plain]
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    BroadcastHashJoin [broadcast,plain]
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                                                Project
                                                  Filter
                                                    ColumnarToRow
                                                      Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                          Project
                                            BroadcastHashJoin [broadcast,plain]
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.web_sales
                                              Project
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
    Filter
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                BroadcastHashJoin [broadcast,plain]
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                                            Project
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.web_sales
                                          Project
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                Project
                  BroadcastHashJoin [broadcast,plain]
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    BroadcastHashJoin [broadcast,plain]
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                                                Project
                                                  Filter
                                                    ColumnarToRow
                                                      Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
                                          Project
                                            BroadcastHashJoin [broadcast,plain]
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.web_sales
                                              Project
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
