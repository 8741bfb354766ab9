Sort
  Exchange
    HashAggregate
      Exchange
        HashAggregate
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_v.lineitem
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_v.orders
