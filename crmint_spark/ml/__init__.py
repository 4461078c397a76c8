"""BQML-equivalent ML layer on pyspark.ml."""
