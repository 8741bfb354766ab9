Sort
  Exchange
    HashAggregate
      Exchange
        HashAggregate
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpchv_v.customer
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpchv_v.orders
