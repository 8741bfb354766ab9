HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            HashAggregate
              Exchange
                HashAggregate
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpchv_v.lineitem
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpchv_v.lineitem
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_v.part
