TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpchv_v.lineitem
              Project
                Filter
                  HashAggregate
                    Exchange
                      HashAggregate
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpchv_v.lineitem
            Project
              BroadcastHashJoin [broadcast,plain]
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpchv_v.orders
                  Project
                    Filter
                      HashAggregate
                        Exchange
                          HashAggregate
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpchv_v.lineitem
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_v.customer
