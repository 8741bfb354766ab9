HashAggregate
  Exchange
    HashAggregate
      Project
        SortMergeJoin [plain,plain]
          Sort
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
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
          Sort
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
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
