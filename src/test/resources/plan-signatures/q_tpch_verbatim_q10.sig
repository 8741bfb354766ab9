TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Filter
              ColumnarToRow
                Scan parquet spark_catalog.graft_tpchv_v.nation
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpchv_v.customer
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpchv_v.orders
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpchv_v.lineitem
