Sort
  Exchange
    Project
      BroadcastHashJoin [broadcast,plain]
        Filter
          ColumnarToRow
            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
        Filter
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
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
                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.household_demographics
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store
