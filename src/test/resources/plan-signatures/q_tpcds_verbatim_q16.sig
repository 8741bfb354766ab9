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
                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_returns
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.catalog_sales
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.call_center
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer_address
