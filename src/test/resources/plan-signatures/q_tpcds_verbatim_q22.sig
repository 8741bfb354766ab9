TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Expand
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpcds_v.item
              Project
                BroadcastHashJoin [broadcast,plain]
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_v.inventory
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_v.warehouse
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_v.date_dim
