TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Union
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  Project
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                  Project
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
              Project
                Project
                  BroadcastHashJoin [broadcast,plain]
                    HashAggregate
                      Exchange
                        HashAggregate
                          Union
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                Project
                                  Project
                                    BroadcastNestedLoopJoin [broadcast,plain]
                                      ColumnarToRow
                                        Scan parquet 
                                      HashAggregate
                                        Exchange
                                          HashAggregate
                                            ColumnarToRow
                                              Scan parquet 
                                Project
                                  Project
                                    BroadcastNestedLoopJoin [broadcast,plain]
                                      ColumnarToRow
                                        Scan parquet 
                                      HashAggregate
                                        Exchange
                                          HashAggregate
                                            ColumnarToRow
                                              Scan parquet 
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  Project
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                  Project
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
              Project
                Project
                  BroadcastHashJoin [broadcast,plain]
                    HashAggregate
                      Exchange
                        HashAggregate
                          Union
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                Project
                                  Project
                                    BroadcastNestedLoopJoin [broadcast,plain]
                                      ColumnarToRow
                                        Scan parquet 
                                      HashAggregate
                                        Exchange
                                          HashAggregate
                                            ColumnarToRow
                                              Scan parquet 
                                Project
                                  Project
                                    BroadcastNestedLoopJoin [broadcast,plain]
                                      ColumnarToRow
                                        Scan parquet 
                                      HashAggregate
                                        Exchange
                                          HashAggregate
                                            ColumnarToRow
                                              Scan parquet 
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  Project
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                  Project
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Union
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                                            Project
                                              Project
                                                BroadcastNestedLoopJoin [broadcast,plain]
                                                  ColumnarToRow
                                                    Scan parquet 
                                                  HashAggregate
                                                    Exchange
                                                      HashAggregate
                                                        ColumnarToRow
                                                          Scan parquet 
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
              Project
                Project
                  BroadcastHashJoin [broadcast,plain]
                    HashAggregate
                      Exchange
                        HashAggregate
                          Union
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Union
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                                    Project
                                      Project
                                        BroadcastNestedLoopJoin [broadcast,plain]
                                          ColumnarToRow
                                            Scan parquet 
                                          HashAggregate
                                            Exchange
                                              HashAggregate
                                                ColumnarToRow
                                                  Scan parquet 
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Union
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                                        Project
                                          Project
                                            BroadcastNestedLoopJoin [broadcast,plain]
                                              ColumnarToRow
                                                Scan parquet 
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    ColumnarToRow
                                                      Scan parquet 
                        HashAggregate
                          Exchange
                            HashAggregate
                              Union
                                Project
                                  Project
                                    BroadcastNestedLoopJoin [broadcast,plain]
                                      ColumnarToRow
                                        Scan parquet 
                                      HashAggregate
                                        Exchange
                                          HashAggregate
                                            ColumnarToRow
                                              Scan parquet 
                                Project
                                  Project
                                    BroadcastNestedLoopJoin [broadcast,plain]
                                      ColumnarToRow
                                        Scan parquet 
                                      HashAggregate
                                        Exchange
                                          HashAggregate
                                            ColumnarToRow
                                              Scan parquet 
