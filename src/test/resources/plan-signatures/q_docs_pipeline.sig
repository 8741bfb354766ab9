HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin
          Project
            Filter
              Window
                WindowGroupLimit
                  Sort
                    Exchange
                      WindowGroupLimit
                        Sort
                          Project
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet 
          BroadcastExchange
            Exchange
              Project
                Filter
                  Scan ExistingRDD
