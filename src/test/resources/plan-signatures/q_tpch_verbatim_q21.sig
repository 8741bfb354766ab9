HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  BroadcastHashJoin [broadcast,plain]
                    BroadcastHashJoin [broadcast,plain]
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpchv_v.lineitem
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpchv_v.lineitem
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpchv_v.lineitem
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpchv_v.supplier
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpchv_v.orders
          Project
            Filter
              ColumnarToRow
                Scan parquet spark_catalog.graft_tpchv_v.nation
