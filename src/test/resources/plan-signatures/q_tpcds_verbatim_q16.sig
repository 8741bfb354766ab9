HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        BroadcastHashJoin [broadcast,plain]
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_returns
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.call_center
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
