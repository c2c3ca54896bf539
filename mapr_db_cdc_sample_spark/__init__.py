"""PySpark-native analytics engine with the query and data-processing
capabilities of mapr-demos/mapr-db-cdc-sample (reference at /root/reference).

Not a port: the reference is a ~375-LoC Java CDC stream-processing client
(FtsAndGeoServiceJSONWithCDC.java / FtsAndGeoServiceBinaryWithCDC.java); this
engine re-expresses its semantics — CDC event model, per-field change
dataflow, content-based routing, multi-sink fan-out — as declarative Spark
DataFrame / SQL / Structured Streaming plans, plus a full batch relational
layer and LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"
