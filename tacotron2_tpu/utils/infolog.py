"""Run logging: console + timestamped file + optional Slack webhook.

Parity with reference infolog.py:13-50 (init(log_path, run_name, slack_url),
log(msg, end, slack))."""

import atexit
import json
from datetime import datetime
from threading import Lock
from urllib.request import Request, urlopen

_format = '%Y-%m-%d %H:%M:%S.%f'
_file = None
_run_name = None
_slack_url = None
_lock = Lock()


def init(filename: str, run_name: str, slack_url: str = None):
    global _file, _run_name, _slack_url
    _close_logfile()
    _file = open(filename, 'a', encoding='utf-8')
    _file.write('\n-----------------------------------------------------------------\n')
    _file.write('Starting new {} training run\n'.format(run_name))
    _file.write('-----------------------------------------------------------------\n')
    _run_name = run_name
    _slack_url = slack_url


def log(msg: str, end: str = '\n', slack: bool = False):
    with _lock:
        print(msg, end=end, flush=True)
        if _file is not None:
            _file.write('[%s]  %s\n' % (datetime.now().strftime(_format)[:-3], msg))
            _file.flush()
    if slack and _slack_url is not None:
        _send_slack(msg)


def _send_slack(msg: str):
    try:
        req = Request(_slack_url)
        req.add_header('Content-Type', 'application/json')
        urlopen(req, json.dumps({
            'username': 'tacotron',
            'icon_emoji': ':taco:',
            'text': '*%s*: %s' % (_run_name, msg),
        }).encode())
    except Exception as e:  # never let telemetry kill training
        print(f'slack notification failed: {e}')


def _close_logfile():
    global _file
    if _file is not None:
        _file.close()
        _file = None


atexit.register(_close_logfile)
