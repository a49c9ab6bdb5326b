class KafSqlEngine:
    pass
