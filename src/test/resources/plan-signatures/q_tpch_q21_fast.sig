HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin
          Project
            BroadcastHashJoin
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
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                                    BroadcastExchange
                                      Project
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
              BroadcastExchange
                Filter
                  ColumnarToRow
                    Scan parquet 
          BroadcastExchange
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
