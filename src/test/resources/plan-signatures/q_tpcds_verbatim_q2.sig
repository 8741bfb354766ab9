Sort
  Exchange
    Project
      BroadcastHashJoin [broadcast,plain]
        Exchange
          Project
            BroadcastHashJoin [broadcast,plain]
              HashAggregate
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Project
                        Filter
                          Window
                            Sort
                              Exchange
                                ColumnarToRow
                                  Scan parquet 
                      Union
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet 
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet 
              Project
                Filter
                  Window
                    Sort
                      Exchange
                        ColumnarToRow
                          Scan parquet 
        Project
          BroadcastHashJoin [broadcast,plain]
            HashAggregate
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      Filter
                        Window
                          Sort
                            Exchange
                              ColumnarToRow
                                Scan parquet 
                    Union
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
            Project
              Filter
                Window
                  Sort
                    Exchange
                      ColumnarToRow
                        Scan parquet 
