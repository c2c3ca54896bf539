"""Engine scalar-function layer: reusable column-expression builders for
text analysis and vector math. Everything here is built from JVM-side
pyspark.sql.functions (whole-stage codegen; no Python UDFs in hot paths).
"""
