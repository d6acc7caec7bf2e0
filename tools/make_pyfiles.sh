#!/bin/sh
# Package the engine for spark-submit --py-files (north rule launch mode).
set -e
cd "$(dirname "$0")/.."
rm -f semlink.zip
python -c "
import zipfile, os
with zipfile.ZipFile('semlink.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk('semlink'):
        for f in files:
            if f.endswith(('.py', '.json')):
                p = os.path.join(root, f)
                z.write(p, p)
print('semlink.zip written')
"
