HashAggregate
  Exchange
    HashAggregate
      EmptyRelation
