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
                      Scan parquet spark_catalog.graft_tpcds_v.customer
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_v.customer_address
              Project
                BroadcastHashJoin [broadcast,plain]
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_v.store_sales
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_v.item
                          Filter
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_v.item
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_v.date_dim
