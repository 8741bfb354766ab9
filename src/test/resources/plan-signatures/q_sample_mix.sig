HashAggregate
  Exchange
    HashAggregate
      Filter
        ColumnarToRow
          Scan parquet 
