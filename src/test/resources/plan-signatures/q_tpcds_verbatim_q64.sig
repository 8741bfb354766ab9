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
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.income_band
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.income_band
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.household_demographics
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.household_demographics
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.promotion
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Filter
                                                      ColumnarToRow
                                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_demographics
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_demographics
                                                        Project
                                                          BroadcastHashJoin [broadcast,plain]
                                                            Filter
                                                              ColumnarToRow
                                                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                                            Project
                                                              BroadcastHashJoin [broadcast,plain]
                                                                Filter
                                                                  ColumnarToRow
                                                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                                                Project
                                                                  BroadcastHashJoin [broadcast,plain]
                                                                    Filter
                                                                      ColumnarToRow
                                                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
                                                                    Project
                                                                      BroadcastHashJoin [broadcast,plain]
                                                                        Filter
                                                                          ColumnarToRow
                                                                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store
                                                                        Project
                                                                          BroadcastHashJoin [broadcast,plain]
                                                                            Filter
                                                                              ColumnarToRow
                                                                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                                                            Project
                                                                              BroadcastHashJoin [broadcast,plain]
                                                                                Project
                                                                                  BroadcastHashJoin [broadcast,plain]
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_returns
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                                                                                Project
                                                                                  Filter
                                                                                    HashAggregate
                                                                                      Exchange
                                                                                        HashAggregate
                                                                                          Project
                                                                                            BroadcastHashJoin [broadcast,plain]
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_returns
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.income_band
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.income_band
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.household_demographics
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.household_demographics
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.promotion
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Filter
                                                      ColumnarToRow
                                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_demographics
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_demographics
                                                        Project
                                                          BroadcastHashJoin [broadcast,plain]
                                                            Filter
                                                              ColumnarToRow
                                                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                                            Project
                                                              BroadcastHashJoin [broadcast,plain]
                                                                Filter
                                                                  ColumnarToRow
                                                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                                                Project
                                                                  BroadcastHashJoin [broadcast,plain]
                                                                    Filter
                                                                      ColumnarToRow
                                                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
                                                                    Project
                                                                      BroadcastHashJoin [broadcast,plain]
                                                                        Filter
                                                                          ColumnarToRow
                                                                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store
                                                                        Project
                                                                          BroadcastHashJoin [broadcast,plain]
                                                                            Filter
                                                                              ColumnarToRow
                                                                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                                                            Project
                                                                              BroadcastHashJoin [broadcast,plain]
                                                                                Project
                                                                                  BroadcastHashJoin [broadcast,plain]
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_returns
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                                                                                Project
                                                                                  Filter
                                                                                    HashAggregate
                                                                                      Exchange
                                                                                        HashAggregate
                                                                                          Project
                                                                                            BroadcastHashJoin [broadcast,plain]
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_returns
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
