Sort
  Exchange
    Project
      BroadcastHashJoin [broadcast,plain]
        Exchange
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
                ColumnarToRow
                  Scan parquet 
