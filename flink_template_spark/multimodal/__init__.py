from flink_template_spark.multimodal import assets, features  # noqa: F401
