TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.web_sales
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
                          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.web_sales
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
                              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
              HashAggregate
                Exchange
                  HashAggregate
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.customer
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.date_dim
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
