TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Expand
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.item
              Project
                BroadcastHashJoin [broadcast,plain]
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.inventory
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.warehouse
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.date_dim
