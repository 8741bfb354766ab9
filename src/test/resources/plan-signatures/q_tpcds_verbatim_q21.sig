TakeOrderedAndProject
  Filter
    HashAggregate
      Exchange
        HashAggregate
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.warehouse
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.inventory
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
