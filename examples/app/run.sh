#!/bin/sh
# Launch the NBDT inference API (reference examples/app/run.sh uses uwsgi;
# this build's api.py is a stdlib ThreadingHTTPServer — no uwsgi needed).
# Location-independent: works from any cwd.
exec python "$(dirname "$0")/api.py" --port 5000 "$@"
