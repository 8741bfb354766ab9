HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_ssbv_b11ff25d10d0317c.date
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_ssbv_b11ff25d10d0317c.lineorder
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_ssbv_b11ff25d10d0317c.part
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_ssbv_b11ff25d10d0317c.supplier
