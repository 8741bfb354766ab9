Sort
  Exchange
    Filter
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpchv_v.partsupp
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpchv_v.supplier
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpchv_v.nation
