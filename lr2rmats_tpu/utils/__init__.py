from .log import log, set_log_stream, Timer
