TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        ColumnarToRow
          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                HashAggregate
                  Exchange
                    HashAggregate
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_returns
                                Project
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
              Filter
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_returns
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
          Project
            Filter
              ColumnarToRow
                Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store
