Sort
  Exchange
    HashAggregate
      Exchange
        HashAggregate
          Project
            BroadcastHashJoin [broadcast,plain]
              ColumnarToRow
                Scan parquet spark_catalog.graft_tpchv_v.orders
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpchv_v.customer
