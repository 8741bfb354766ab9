Project
  Scan OneRowRelation
