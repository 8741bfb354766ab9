TakeOrderedAndProject
  BroadcastHashJoin [broadcast,plain]
    Filter
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  BroadcastHashJoin [broadcast,plain]
                    BroadcastHashJoin [broadcast,plain]
                      Exchange
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            BroadcastHashJoin [broadcast,plain]
                              Exchange
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
                              HashAggregate
                                Exchange
                                  HashAggregate
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            BroadcastHashJoin [broadcast,plain]
                                              Exchange
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet 
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet 
                                                    Project
                                                      Filter
                                                        ColumnarToRow
                                                          Scan parquet 
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet 
                                            Filter
                                              ColumnarToRow
                                                Scan parquet 
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
                            Filter
                              ColumnarToRow
                                Scan parquet 
                      Filter
                        ColumnarToRow
                          Scan parquet 
                    BroadcastHashJoin [broadcast,plain]
                      Exchange
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            BroadcastHashJoin [broadcast,plain]
                              Exchange
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
                              HashAggregate
                                Exchange
                                  HashAggregate
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            BroadcastHashJoin [broadcast,plain]
                                              Exchange
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet 
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet 
                                                    Project
                                                      Filter
                                                        ColumnarToRow
                                                          Scan parquet 
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet 
                                            Filter
                                              ColumnarToRow
                                                Scan parquet 
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
                            Filter
                              ColumnarToRow
                                Scan parquet 
                      Filter
                        ColumnarToRow
                          Scan parquet 
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
    Filter
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  BroadcastHashJoin [broadcast,plain]
                    BroadcastHashJoin [broadcast,plain]
                      Exchange
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            BroadcastHashJoin [broadcast,plain]
                              Exchange
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
                              HashAggregate
                                Exchange
                                  HashAggregate
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            BroadcastHashJoin [broadcast,plain]
                                              Exchange
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet 
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet 
                                                    Project
                                                      Filter
                                                        ColumnarToRow
                                                          Scan parquet 
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet 
                                            Filter
                                              ColumnarToRow
                                                Scan parquet 
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
                            Filter
                              ColumnarToRow
                                Scan parquet 
                      Filter
                        ColumnarToRow
                          Scan parquet 
                    BroadcastHashJoin [broadcast,plain]
                      Exchange
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            BroadcastHashJoin [broadcast,plain]
                              Exchange
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
                              HashAggregate
                                Exchange
                                  HashAggregate
                                    Project
                                      BroadcastHashJoin [broadcast,plain]
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            BroadcastHashJoin [broadcast,plain]
                                              Exchange
                                                Project
                                                  BroadcastHashJoin [broadcast,plain]
                                                    Project
                                                      BroadcastHashJoin [broadcast,plain]
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet 
                                                        Filter
                                                          ColumnarToRow
                                                            Scan parquet 
                                                    Project
                                                      Filter
                                                        ColumnarToRow
                                                          Scan parquet 
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet 
                                            Filter
                                              ColumnarToRow
                                                Scan parquet 
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
                            Filter
                              ColumnarToRow
                                Scan parquet 
                      Filter
                        ColumnarToRow
                          Scan parquet 
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
