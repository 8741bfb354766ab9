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
                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_returns
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.catalog_sales
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.call_center
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_address
