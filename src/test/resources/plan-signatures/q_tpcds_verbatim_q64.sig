Project
  Sort
    Exchange
      Project
        BroadcastHashJoin [broadcast,plain]
          Exchange
            HashAggregate
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
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
                                                                            Project
                                                                              BroadcastHashJoin [broadcast,plain]
                                                                                Exchange
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
                                                                                    HashAggregate
                                                                                      Exchange
                                                                                        HashAggregate
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
            HashAggregate
              Project
                BroadcastHashJoin [broadcast,plain]
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
                                                                          Project
                                                                            BroadcastHashJoin [broadcast,plain]
                                                                              Exchange
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
                                                                                  HashAggregate
                                                                                    Exchange
                                                                                      HashAggregate
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
