HashAggregate
  HashAggregate
    Project
      BroadcastHashJoin [broadcast,plain]
        HashAggregate
          Exchange
            HashAggregate
              Generate
                Filter
                  ColumnarToRow
                    Scan parquet 
        Project
          Filter
            Window
              WindowGroupLimit
                Sort
                  Generate
                    Filter
                      ObjectHashAggregate
                        Exchange
                          ObjectHashAggregate
                            Generate
                              Filter
                                ColumnarToRow
                                  Scan parquet 
