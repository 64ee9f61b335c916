"""Source connectors: the HNAP modem poll source and its Spark glue."""
