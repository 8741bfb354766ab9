HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            Filter
              ColumnarToRow
                Scan parquet spark_catalog.graft_ssbv_v.date
          Project
            Filter
              ColumnarToRow
                Scan parquet spark_catalog.graft_ssbv_v.lineorder
