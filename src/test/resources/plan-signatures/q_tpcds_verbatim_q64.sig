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
                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.income_band
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.income_band
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer_address
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer_address
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.household_demographics
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.household_demographics
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.promotion
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Filter
                                                      ColumnarToRow
                                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer_demographics
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer_demographics
                                                        Project
                                                          BroadcastHashJoin [broadcast,plain]
                                                            Filter
                                                              ColumnarToRow
                                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                                            Project
                                                              BroadcastHashJoin [broadcast,plain]
                                                                Filter
                                                                  ColumnarToRow
                                                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                                                Project
                                                                  BroadcastHashJoin [broadcast,plain]
                                                                    Filter
                                                                      ColumnarToRow
                                                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer
                                                                    Project
                                                                      BroadcastHashJoin [broadcast,plain]
                                                                        Filter
                                                                          ColumnarToRow
                                                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store
                                                                        Project
                                                                          BroadcastHashJoin [broadcast,plain]
                                                                            Filter
                                                                              ColumnarToRow
                                                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                                                            Project
                                                                              BroadcastHashJoin [broadcast,plain]
                                                                                Project
                                                                                  BroadcastHashJoin [broadcast,plain]
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_returns
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
                                                                                Project
                                                                                  Filter
                                                                                    HashAggregate
                                                                                      Exchange
                                                                                        HashAggregate
                                                                                          Project
                                                                                            BroadcastHashJoin [broadcast,plain]
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_returns
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.income_band
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.income_band
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer_address
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer_address
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.household_demographics
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.household_demographics
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.promotion
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Filter
                                                      ColumnarToRow
                                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer_demographics
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer_demographics
                                                        Project
                                                          BroadcastHashJoin [broadcast,plain]
                                                            Filter
                                                              ColumnarToRow
                                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                                            Project
                                                              BroadcastHashJoin [broadcast,plain]
                                                                Filter
                                                                  ColumnarToRow
                                                                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                                                Project
                                                                  BroadcastHashJoin [broadcast,plain]
                                                                    Filter
                                                                      ColumnarToRow
                                                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer
                                                                    Project
                                                                      BroadcastHashJoin [broadcast,plain]
                                                                        Filter
                                                                          ColumnarToRow
                                                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store
                                                                        Project
                                                                          BroadcastHashJoin [broadcast,plain]
                                                                            Filter
                                                                              ColumnarToRow
                                                                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                                                                            Project
                                                                              BroadcastHashJoin [broadcast,plain]
                                                                                Project
                                                                                  BroadcastHashJoin [broadcast,plain]
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_returns
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
                                                                                Project
                                                                                  Filter
                                                                                    HashAggregate
                                                                                      Exchange
                                                                                        HashAggregate
                                                                                          Project
                                                                                            BroadcastHashJoin [broadcast,plain]
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_returns
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
