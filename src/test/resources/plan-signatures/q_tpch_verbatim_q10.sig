TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              BroadcastHashJoin [broadcast,plain]
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.nation
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.customer
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.orders
            Project
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
