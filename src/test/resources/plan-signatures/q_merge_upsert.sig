HashAggregate
  Exchange
    HashAggregate
      Project
        SortMergeJoin
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
