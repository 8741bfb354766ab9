TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Union
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet 
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet 
                  Filter
                    ColumnarToRow
                      Scan parquet 
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet 
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet 
                  Filter
                    ColumnarToRow
                      Scan parquet 
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet 
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet 
                  Filter
                    ColumnarToRow
                      Scan parquet 
