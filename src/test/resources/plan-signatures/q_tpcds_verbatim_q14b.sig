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
                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                BroadcastHashJoin [broadcast,plain]
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                                            Project
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.web_sales
                                          Project
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                Project
                  BroadcastHashJoin [broadcast,plain]
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    BroadcastHashJoin [broadcast,plain]
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                                                Project
                                                  Filter
                                                    ColumnarToRow
                                                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                          Project
                                            BroadcastHashJoin [broadcast,plain]
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.web_sales
                                              Project
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
    Filter
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                BroadcastHashJoin [broadcast,plain]
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                                            Project
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.web_sales
                                          Project
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                Project
                  BroadcastHashJoin [broadcast,plain]
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    BroadcastHashJoin [broadcast,plain]
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                                                Project
                                                  Filter
                                                    ColumnarToRow
                                                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                                          Project
                                            BroadcastHashJoin [broadcast,plain]
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.web_sales
                                              Project
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
