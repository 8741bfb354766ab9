HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            Filter
              ColumnarToRow
                Scan parquet spark_catalog.graft_ssbv_b11ff25d10d0317c.date
          Project
            Filter
              ColumnarToRow
                Scan parquet spark_catalog.graft_ssbv_b11ff25d10d0317c.lineorder
