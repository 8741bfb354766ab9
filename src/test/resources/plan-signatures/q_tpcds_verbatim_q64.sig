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
                            Scan parquet spark_catalog.graft_tpcds_v.income_band
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_v.income_band
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_v.customer_address
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_v.customer_address
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_v.household_demographics
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_v.household_demographics
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_v.promotion
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Filter
                                                      ColumnarToRow
                                                        Scan parquet spark_catalog.graft_tpcds_v.customer_demographics
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet spark_catalog.graft_tpcds_v.customer_demographics
                                                        Project
                                                          BroadcastHashJoin [broadcast,plain]
                                                            Filter
                                                              ColumnarToRow
                                                                Scan parquet spark_catalog.graft_tpcds_v.date_dim
                                                            Project
                                                              BroadcastHashJoin [broadcast,plain]
                                                                Filter
                                                                  ColumnarToRow
                                                                    Scan parquet spark_catalog.graft_tpcds_v.date_dim
                                                                Project
                                                                  BroadcastHashJoin [broadcast,plain]
                                                                    Filter
                                                                      ColumnarToRow
                                                                        Scan parquet spark_catalog.graft_tpcds_v.customer
                                                                    Project
                                                                      BroadcastHashJoin [broadcast,plain]
                                                                        Filter
                                                                          ColumnarToRow
                                                                            Scan parquet spark_catalog.graft_tpcds_v.store
                                                                        Project
                                                                          BroadcastHashJoin [broadcast,plain]
                                                                            Filter
                                                                              ColumnarToRow
                                                                                Scan parquet spark_catalog.graft_tpcds_v.date_dim
                                                                            Project
                                                                              BroadcastHashJoin [broadcast,plain]
                                                                                Project
                                                                                  BroadcastHashJoin [broadcast,plain]
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_v.store_returns
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_v.store_sales
                                                                                Project
                                                                                  Filter
                                                                                    HashAggregate
                                                                                      Exchange
                                                                                        HashAggregate
                                                                                          Project
                                                                                            BroadcastHashJoin [broadcast,plain]
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_v.catalog_returns
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_v.catalog_sales
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_v.item
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_v.income_band
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_v.income_band
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_v.customer_address
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_v.customer_address
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_v.household_demographics
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_v.household_demographics
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_v.promotion
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Filter
                                                      ColumnarToRow
                                                        Scan parquet spark_catalog.graft_tpcds_v.customer_demographics
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet spark_catalog.graft_tpcds_v.customer_demographics
                                                        Project
                                                          BroadcastHashJoin [broadcast,plain]
                                                            Filter
                                                              ColumnarToRow
                                                                Scan parquet spark_catalog.graft_tpcds_v.date_dim
                                                            Project
                                                              BroadcastHashJoin [broadcast,plain]
                                                                Filter
                                                                  ColumnarToRow
                                                                    Scan parquet spark_catalog.graft_tpcds_v.date_dim
                                                                Project
                                                                  BroadcastHashJoin [broadcast,plain]
                                                                    Filter
                                                                      ColumnarToRow
                                                                        Scan parquet spark_catalog.graft_tpcds_v.customer
                                                                    Project
                                                                      BroadcastHashJoin [broadcast,plain]
                                                                        Filter
                                                                          ColumnarToRow
                                                                            Scan parquet spark_catalog.graft_tpcds_v.store
                                                                        Project
                                                                          BroadcastHashJoin [broadcast,plain]
                                                                            Filter
                                                                              ColumnarToRow
                                                                                Scan parquet spark_catalog.graft_tpcds_v.date_dim
                                                                            Project
                                                                              BroadcastHashJoin [broadcast,plain]
                                                                                Project
                                                                                  BroadcastHashJoin [broadcast,plain]
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_v.store_returns
                                                                                    Filter
                                                                                      ColumnarToRow
                                                                                        Scan parquet spark_catalog.graft_tpcds_v.store_sales
                                                                                Project
                                                                                  Filter
                                                                                    HashAggregate
                                                                                      Exchange
                                                                                        HashAggregate
                                                                                          Project
                                                                                            BroadcastHashJoin [broadcast,plain]
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_v.catalog_returns
                                                                                              Filter
                                                                                                ColumnarToRow
                                                                                                  Scan parquet spark_catalog.graft_tpcds_v.catalog_sales
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_v.item
