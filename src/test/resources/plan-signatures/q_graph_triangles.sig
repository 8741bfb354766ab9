TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Union
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    InMemoryTableScan
                  Filter
                    InMemoryTableScan
              Project
                Filter
                  InMemoryTableScan
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    InMemoryTableScan
                  Filter
                    InMemoryTableScan
              Project
                Filter
                  InMemoryTableScan
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    InMemoryTableScan
                  Filter
                    InMemoryTableScan
              Project
                Filter
                  InMemoryTableScan
