HashAggregate
  Exchange
    HashAggregate
      Project
        SortMergeJoin [plain,plain]
          Sort
            Exchange
              Project
                ColumnarToRow
                  Scan parquet 
          Sort
            Exchange
              Union
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
