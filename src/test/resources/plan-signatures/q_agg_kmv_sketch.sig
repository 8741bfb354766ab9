ObjectHashAggregate
  Exchange
    ObjectHashAggregate
      HashAggregate
        Exchange
          HashAggregate
            ColumnarToRow
              Scan parquet 
