from .meters import AverageMeter, MeterBank, Timer, device_trace
