HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Exchange
            Filter
              ColumnarToRow
                Scan parquet 
          Project
            SortMergeJoin [plain,plain]
              Sort
                ObjectHashAggregate
                  ObjectHashAggregate
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Project
                          Filter
                            Generate
                              Project
                                Exchange
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
                        Project
                          Filter
                            HashAggregate
                              Exchange
                                HashAggregate
                                  HashAggregate
                                    HashAggregate
                                      Project
                                        Filter
                                          Generate
                                            Project
                                              Exchange
                                                ColumnarToRow
                                                  Scan parquet 
              Sort
                Project
                  Exchange
                    Filter
                      ColumnarToRow
                        Scan parquet 
