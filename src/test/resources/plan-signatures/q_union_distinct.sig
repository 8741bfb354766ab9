HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        Exchange
          HashAggregate
            Union
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
