from local_stream_stack_spark.utils.logger import get_logger

__all__ = ["get_logger"]
