HashAggregate
  Exchange
    HashAggregate
      Project
        Filter
          ColumnarToRow
            Scan parquet spark_catalog.graft_tpchv_v.lineitem
