Sort
  Exchange
    Project
      BroadcastHashJoin [broadcast,plain]
        Project
          BroadcastHashJoin [broadcast,plain]
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_v.date_dim
                      Union
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_v.web_sales
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_v.catalog_sales
            Project
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpcds_v.date_dim
        Project
          BroadcastHashJoin [broadcast,plain]
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_v.date_dim
                      Union
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_v.web_sales
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_v.catalog_sales
            Project
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpcds_v.date_dim
