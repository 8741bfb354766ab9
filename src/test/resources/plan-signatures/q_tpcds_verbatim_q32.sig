CollectLimit
  Project
    BroadcastHashJoin [broadcast,plain]
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpcds_v.catalog_sales
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_v.catalog_sales
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_v.date_dim
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpcds_v.item
      Project
        Filter
          ColumnarToRow
            Scan parquet spark_catalog.graft_tpcds_v.date_dim
