HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                HashAggregate
                  Exchange
                    HashAggregate
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.lineitem
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_253aead19e5431f0.part
