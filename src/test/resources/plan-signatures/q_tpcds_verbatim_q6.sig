TakeOrderedAndProject
  Filter
    HashAggregate
      Exchange
        HashAggregate
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.customer_address
              Project
                BroadcastHashJoin [broadcast,plain]
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                          Filter
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
