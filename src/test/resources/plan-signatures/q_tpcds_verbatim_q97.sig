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
                      Filter
                        ColumnarToRow
                          Scan parquet 
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
          Sort
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet 
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
