/* No-op stand-in for the reference's ONPOSIX Logger (obcore/base/Logger.h)
 * so the golden harness compiles the grid sources without the logging
 * subsystem.  LOGMSG bodies are compiled out; verbosity constants kept. */
#ifndef GOLDEN_SHIM_LOGGER_H
#define GOLDEN_SHIM_LOGGER_H

/* transitive includes the reference Logger.h provides and the grid
 * sources rely on */
#include <fstream>
#include <ostream>
#include <sstream>
#include <string>

#include "Timer.h"

const int DBG_ERROR = 0;
const int DBG_WARN = 1;
const int DBG_DEBUG = 2;

#define LOGMSG(priority, msg) \
  do                          \
  {                           \
  } while(0)

#define LOGMSG_CONF(outputFile, configuration, fileLevel, screenLevel) \
  do                                                                   \
  {                                                                    \
  } while(0)

#endif
