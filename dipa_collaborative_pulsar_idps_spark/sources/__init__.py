from .pulsar import pulsar_sink_writer, pulsar_source_reader

__all__ = ["pulsar_source_reader", "pulsar_sink_writer"]
