TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Expand
          Union
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store
                          Union
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_returns
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_page
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                          Union
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_returns
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_site
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                          Union
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_returns
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
