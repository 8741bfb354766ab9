HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin
          BroadcastExchange
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
          Project
            BroadcastHashJoin
              BroadcastExchange
                Filter
                  ColumnarToRow
                    Scan parquet 
              Project
                Filter
                  Window
                    Sort
                      Exchange
                        Project
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  BroadcastHashJoin
                                    BroadcastExchange
                                      Project
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
