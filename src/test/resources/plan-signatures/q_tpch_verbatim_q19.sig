HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpchv_v.part
          Project
            Filter
              ColumnarToRow
                Scan parquet spark_catalog.graft_tpchv_v.lineitem
