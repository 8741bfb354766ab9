HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            BroadcastHashJoin [broadcast,plain]
              BroadcastHashJoin [broadcast,plain]
                BroadcastHashJoin [broadcast,plain]
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.orders
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.supplier
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.nation
