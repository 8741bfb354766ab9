HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.reason
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
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
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_returns
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_page
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
