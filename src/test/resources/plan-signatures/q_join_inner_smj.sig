HashAggregate
  Exchange
    HashAggregate
      Project
        SortMergeJoin [plain,plain]
          Sort
            Exchange
              Filter
                ColumnarToRow
                  Scan parquet 
          Sort
            Exchange
              Filter
                ColumnarToRow
                  Scan parquet 
