Sort
  Exchange
    HashAggregate
      Exchange
        HashAggregate
          Project
            BroadcastHashJoin [broadcast,plain]
              ColumnarToRow
                Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.orders
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.customer
