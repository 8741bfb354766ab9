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
                    Scan parquet 
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      ColumnarToRow
                        Scan parquet 
                    Filter
                      ColumnarToRow
                        Scan parquet 
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
                          Scan parquet 
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet 
                          Filter
                            ColumnarToRow
                              Scan parquet 
          Project
            BroadcastHashJoin [broadcast,plain]
              HashAggregate
                Exchange
                  HashAggregate
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet 
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet 
                            Filter
                              ColumnarToRow
                                Scan parquet 
              Project
                BroadcastHashJoin [broadcast,plain]
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet 
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
                  Filter
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet 
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
