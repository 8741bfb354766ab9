TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
              Project
                Filter
                  HashAggregate
                    Exchange
                      HashAggregate
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
            Project
              BroadcastHashJoin [broadcast,plain]
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.orders
                  Project
                    Filter
                      HashAggregate
                        Exchange
                          HashAggregate
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.customer
