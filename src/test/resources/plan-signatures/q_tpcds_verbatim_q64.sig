Project
  Sort
    Exchange
      Project
        BroadcastHashJoin [broadcast,plain]
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.income_band
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.income_band
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_address
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_address
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.household_demographics
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.household_demographics
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.promotion
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Filter
                                                      ColumnarToRow
                                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_demographics
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_demographics
                                                        Project
                                                          BroadcastHashJoin [broadcast,plain]
                                                            Filter
                                                              ColumnarToRow
                                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                                            Project
                                                              BroadcastHashJoin [broadcast,plain]
                                                                Filter
                                                                  ColumnarToRow
                                                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                                                Project
                                                                  BroadcastHashJoin [broadcast,plain]
                                                                    Filter
                                                                      ColumnarToRow
                                                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
                                                                    Project
                                                                      BroadcastHashJoin [broadcast,plain]
                                                                        Filter
                                                                          ColumnarToRow
                                                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store
                                                                        Project
                                                                          BroadcastHashJoin [broadcast,plain]
                                                                            Filter
                                                                              ColumnarToRow
                                                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                                                            Project
                                                                              BroadcastHashJoin [broadcast,plain]
                                                                                Project
                                                                                  BroadcastHashJoin [broadcast,plain]
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_returns
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                                                                                Project
                                                                                  Filter
                                                                                    HashAggregate
                                                                                      Exchange
                                                                                        HashAggregate
                                                                                          Project
                                                                                            BroadcastHashJoin [broadcast,plain]
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_returns
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.income_band
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.income_band
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_address
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_address
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.household_demographics
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.household_demographics
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.promotion
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Filter
                                                      ColumnarToRow
                                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_demographics
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_demographics
                                                        Project
                                                          BroadcastHashJoin [broadcast,plain]
                                                            Filter
                                                              ColumnarToRow
                                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                                            Project
                                                              BroadcastHashJoin [broadcast,plain]
                                                                Filter
                                                                  ColumnarToRow
                                                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                                                Project
                                                                  BroadcastHashJoin [broadcast,plain]
                                                                    Filter
                                                                      ColumnarToRow
                                                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
                                                                    Project
                                                                      BroadcastHashJoin [broadcast,plain]
                                                                        Filter
                                                                          ColumnarToRow
                                                                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store
                                                                        Project
                                                                          BroadcastHashJoin [broadcast,plain]
                                                                            Filter
                                                                              ColumnarToRow
                                                                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                                                                            Project
                                                                              BroadcastHashJoin [broadcast,plain]
                                                                                Project
                                                                                  BroadcastHashJoin [broadcast,plain]
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_returns
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                                                                                Project
                                                                                  Filter
                                                                                    HashAggregate
                                                                                      Exchange
                                                                                        HashAggregate
                                                                                          Project
                                                                                            BroadcastHashJoin [broadcast,plain]
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_returns
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
