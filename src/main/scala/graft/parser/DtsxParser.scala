package graft.parser

import graft.ir.Ir._
import graft.types.SsisTypes.SsisColumnType

import java.io.{File, StringReader}
import javax.xml.parsers.SAXParserFactory
import scala.xml.{Elem, Node, XML}

/** `.dtsx` frontend — the Scala analog of the reference's lxml parser
  * (ssis-to-dbt `src/parser/ssis_parser.py:112-530`), with the same
  * security posture (XXE disabled, no DTD/entity resolution — mirrors
  * `ssis_parser.py:22-36` / `tests/test_parser_security.py:13-50`) and
  * the same component coverage, plus full parses for the components the
  * reference only recognizes by class id.
  *
  * Namespace handling: matches on local names (`DTS:Executable` →
  * label "Executable"), so namespace-prefix variations parse identically.
  */
object DtsxParser {

  /** Hardened SAX parser: DTDs disallowed, external entities off. */
  private def secureParser = {
    val f = SAXParserFactory.newInstance()
    f.setNamespaceAware(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    f.setXIncludeAware(false)
    f.newSAXParser()
  }

  def parseFile(path: String): SsisPackage =
    parseElem(XML.withSAXParser(secureParser).loadFile(new File(path)))

  def parseString(xml: String): SsisPackage =
    parseElem(XML.withSAXParser(secureParser).load(new StringReader(xml)))

  def parseDirectory(dir: String): List[SsisPackage] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".dtsx")).sortBy(_.getName)
    files.toList.map(f => parseFile(f.getAbsolutePath))
  }

  // DTS attributes arrive as "DTS:Name" when namespace-aware parsing is
  // off; accept bare or prefixed spellings.
  private def attr(n: Node, name: String): Option[String] = {
    val candidates = Seq(name, s"DTS:$name", s"SQLTask:$name", s"SendMailTask:$name")
    candidates.flatMap(c => n.attribute(c).map(_.text)).headOption
      .orElse(n.attributes.asAttrMap.collectFirst {
        case (k, v) if k == name || k.endsWith(s":$name") => v
      })
  }

  private def label(n: Node): String = n.label

  private def variableTypeName(code: String): String = code match {
    case "2" => "DT_I2"
    case "3" => "DT_I4"
    case "7" => "DT_DATE"
    case "8" => "DT_WSTR"
    case "11" => "DT_BOOL"
    case "13" => "DT_VARIANT"
    case "20" => "DT_I8"
    case "135" => "DT_DBTIMESTAMP"
    case _ => "DT_WSTR"
  }

  def parseElem(root: Elem): SsisPackage = {
    val warnings = scala.collection.mutable.ListBuffer.empty[String]

    val cms = (root \ "ConnectionManagers" \ "ConnectionManager").toList.map { cm =>
      val inner = (cm \ "ObjectData" \ "ConnectionManager").headOption
      ConnectionManager(
        refId = attr(cm, "refId").getOrElse(""),
        name = attr(cm, "ObjectName").getOrElse(""),
        dtsId = attr(cm, "DTSID").getOrElse(""),
        connectionString = inner.flatMap(attr(_, "ConnectionString")).getOrElse(""))
    }

    val vars = (root \ "Variables" \ "Variable").toList.map { v =>
      val value = (v \ "VariableValue").headOption
      Variable(
        namespace = attr(v, "Namespace").getOrElse("User"),
        name = attr(v, "ObjectName").getOrElse(""),
        ssisType = variableTypeName(value.flatMap(attr(_, "DataType")).getOrElse("8")),
        value = value.map(_.text).getOrElse(""),
        // the Expression text is only ACTIVE when EvaluateAsExpression
        // is set (or absent, the fixture dialect); a designer-disabled
        // expression must fall back to the literal value
        expression = attr(v, "Expression").filter(_.nonEmpty)
          .filter(_ => attr(v, "EvaluateAsExpression").forall(a =>
            a.trim == "1" || a.trim.equalsIgnoreCase("true"))))
    }

    val tasks = (root \ "Executables" \ "Executable").toList.flatMap(parseExecutable(_, warnings))

    val constraints = parseConstraints(root, warnings)

    SsisPackage(
      name = attr(root, "ObjectName").getOrElse(""),
      description = attr(root, "Description").filter(_.nonEmpty),
      connectionManagers = cms,
      variables = vars,
      tasks = tasks,
      constraints = constraints,
      warnings = warnings.toList)
  }

  /** "Package\Load Sales Facts" → "Load Sales Facts". */
  private def taskNameFromRef(ref: String): String =
    ref.split('\\').lastOption.getOrElse(ref)

  /** Precedence constraints of `node` (the package root OR a container —
    * containers carry their own internal constraint set). Two dialects:
    * the fixture form signals an expression gate via Value="3"; real SSIS
    * rides EvalOp (1 = Expression, 3 = ExpressionAndConstraint,
    * 4 = ExpressionOrConstraint) with Value still 0-2. The And/Or
    * combinations are approximated as expression-only gates, with a
    * warning — the engine's gate algebra evaluates one kind per edge. */
  private def parseConstraints(node: Node,
      warnings: scala.collection.mutable.ListBuffer[String]): List[PrecedenceConstraint] =
    (node \ "PrecedenceConstraints" \ "PrecedenceConstraint").toList.map { pc =>
      val expr = attr(pc, "Expression").filter(_.nonEmpty)
      val evalOp = attr(pc, "EvalOp").map(_.trim)
      val kind =
        if (evalOp.exists(Set("1", "3", "4").contains) && expr.isDefined) {
          if (evalOp.exists(o => o == "3" || o == "4"))
            warnings += s"precedence constraint to '${taskNameFromRef(attr(pc, "To").getOrElse(""))}': " +
              "Expression" + (if (evalOp.contains("3")) "And" else "Or") +
              "Constraint approximated as an expression-only gate"
          ConstraintKind.Expression(expr.get)
        } else attr(pc, "Value").getOrElse("0") match {
          case "1" => ConstraintKind.Failure
          case "2" => ConstraintKind.Completion
          case "3" => ConstraintKind.Expression(expr.getOrElse(""))
          case _ => ConstraintKind.Success
        }
      PrecedenceConstraint(
        fromTask = taskNameFromRef(attr(pc, "From").getOrElse("")),
        toTask = taskNameFromRef(attr(pc, "To").getOrElse("")),
        kind = kind)
    }

  private def parseExecutable(
      e: Node, warnings: scala.collection.mutable.ListBuffer[String]): Option[Task] = {
    val name = attr(e, "ObjectName").getOrElse("")
    val desc = attr(e, "Description").filter(_.nonEmpty)
    attr(e, "ExecutableType").getOrElse("") match {
      case "Microsoft.ExecuteSQLTask" =>
        val sqlData = (e \ "ObjectData" \ "SqlTaskData").headOption
        Some(ExecuteSqlTask(
          name = name, description = desc,
          connectionId = sqlData.flatMap(attr(_, "Connection")).getOrElse(""),
          sqlStatement = sqlData.flatMap(attr(_, "SqlStatementSource")).getOrElse(""),
          resultSet = sqlData.flatMap(attr(_, "ResultType")) match {
            case Some("ResultSetType_SingleRow") => "SingleRow"
            case Some("ResultSetType_Rowset") => "Full"
            case _ => "None"
          },
          resultVariable = (e \ "ObjectData" \\ "ResultBinding").headOption
            .flatMap(attr(_, "DtsVariableName")).filter(_.nonEmpty)))
      case "Microsoft.Pipeline" =>
        val comps = (e \ "ObjectData" \ "pipeline" \ "components" \ "component").toList
          .map(parseComponent(_, warnings))
        val paths = (e \ "ObjectData" \ "pipeline" \ "paths" \ "path").toList
          .flatMap(parsePath)
        Some(DataFlowTask(name, desc, comps, paths))
      case "Microsoft.ScriptTask" =>
        val script = (e \ "ObjectData" \\ "ScriptProject").headOption
        def vl(a: String) = script.flatMap(attr(_, a)).map(_.split(",").map(_.trim)
          .filter(_.nonEmpty).toList).getOrElse(Nil)
        warnings += s"Script Task '$name' requires manual review"
        Some(ScriptTask(name, desc,
          scriptLanguage = script.flatMap(attr(_, "Language")).getOrElse("CSharp"),
          readOnlyVariables = vl("ReadOnlyVariables"),
          readWriteVariables = vl("ReadWriteVariables")))
      case "Microsoft.SendMailTask" =>
        val mail = (e \ "ObjectData" \\ "SendMailTaskData").headOption
        warnings += s"Send Mail Task '$name' skipped"
        Some(SendMailTask(name, desc,
          smtpServer = mail.flatMap(attr(_, "SMTPServer")),
          toAddress = mail.flatMap(attr(_, "To")),
          subject = mail.flatMap(attr(_, "Subject"))))
      case t @ ("Microsoft.ForEachLoop" | "Microsoft.ForLoop" | "Microsoft.Sequence" |
          "STOCK:FOREACHLOOP" | "STOCK:FORLOOP" | "STOCK:SEQUENCE") =>
        // real SSIS designers emit the STOCK: spellings; the fixture
        // dialect uses Microsoft.* — both normalize to one container type
        val containerType = t match {
          case "STOCK:FOREACHLOOP" => "ForEachLoop"
          case "STOCK:FORLOOP" => "ForLoop"
          case "STOCK:SEQUENCE" => "Sequence"
          case m => m.stripPrefix("Microsoft.")
        }
        val children = (e \ "Executables" \ "Executable").toList
          .flatMap(parseExecutable(_, warnings))
        // Item-enumerator rows (ForEachEnumerator → FEIEItems): each
        // FEIEItem is one iteration; its FEIEItemValues are positional.
        // Scoped to THIS container's own enumerator/mappings elements —
        // a deep `\\` from the Executable would also absorb the items and
        // mappings of nested ForEach containers under `e \ "Executables"`.
        val ownEnumerator = (e \ "ForEachEnumerator").headOption
        val enumKind = ownEnumerator.flatMap(attr(_, "CreationName")).filter(_.nonEmpty)
        val items = ownEnumerator.toList.flatMap(en => (en \\ "FEIEItem").toList).map { item =>
          (item \ "FEIEItemValue").toList.map { v =>
            EnumValue(
              variableTypeName(attr(v, "Type").getOrElse("8")),
              attr(v, "Value").getOrElse(""))
          }
        }
        val mappings = (e \ "ForEachVariableMappings" \ "ForEachVariableMapping")
          .toList.flatMap { m =>
            attr(m, "VariableName").map { vn =>
              vn -> attr(m, "ValueIndex").flatMap(_.trim.toIntOption).getOrElse(0)
            }
          }
        // File enumerator: FEFEProperty elements each carry ONE of the
        // Folder / FileSpec / FileNameRetrieval / Recurse attributes
        // (ForEachFileEnumeratorProperties shape)
        val fileEnum = ownEnumerator
          .filter(_ => enumKind.exists(_.contains("ForEachFileEnumerator")))
          .flatMap { en =>
            val props = (en \\ "FEFEProperty").toList
            def p(a: String): Option[String] =
              props.flatMap(n => attr(n, a)).headOption.filter(_.nonEmpty)
            p("Folder").map { folder =>
              FileEnumSpec(
                folder = folder,
                fileSpec = p("FileSpec").getOrElse("*.*"),
                retrievalType = p("FileNameRetrieval").flatMap(_.trim.toIntOption).getOrElse(0),
                recurse = p("Recurse").exists(r =>
                  r.trim == "1" || r.trim.equalsIgnoreCase("true")))
            }
          }
        // ADO enumerator: FEEADO names the recordset Object variable
        // (attribute spelling varies across designer versions)
        val adoVar = ownEnumerator
          .filter(_ => enumKind.exists(_.contains("ForEachADOEnumerator")))
          .flatMap { en =>
            (en \\ "FEEADO").headOption.flatMap(n =>
              attr(n, "ObjectVar").orElse(attr(n, "VarName"))
                .orElse(attr(n, "VariableName")))
          }.filter(_.nonEmpty)
        // NodeList enumerator: FEENODELIST carries the XPath + document
        // source. Only the NodeText enumeration mode is convertible — a
        // Navigator/ElementCollection result has no scalar item to bind.
        val nodeList = ownEnumerator
          .filter(_ => enumKind.exists(_.contains("ForEachNodeListEnumerator")))
          .flatMap { en =>
            (en \\ "FEENODELIST").headOption.flatMap { n =>
              val et = attr(n, "EnumerationType").getOrElse("NodeText")
              val xpath = attr(n, "OuterXPathString").getOrElse("")
              if (et != "NodeText" || xpath.isEmpty) None
              else Some(NodeListSpec(
                enumerationType = et,
                sourceType = attr(n, "SourceType").getOrElse("DirectInput"),
                sourceDocument = attr(n, "SourceDocument").getOrElse(""),
                outerXPath = xpath))
            }
          }
        if (containerType == "ForEachLoop" &&
            enumKind.exists(k => !k.contains("ForEachItemEnumerator")) &&
            fileEnum.isEmpty && adoVar.isEmpty && nodeList.isEmpty)
          warnings += s"ForEach container '$name' uses unsupported enumerator " +
            s"${enumKind.get} - requires manual review"
        val forLoop = attr(e, "EvalExpression").map { eval =>
          ForLoopSpec(
            initExpression = attr(e, "InitExpression").filter(_.nonEmpty),
            evalExpression = eval,
            assignExpression = attr(e, "AssignExpression").filter(_.nonEmpty))
        }
        Some(ContainerTask(name, desc, containerType, children,
          enumItems = items, variableMappings = mappings, forLoop = forLoop,
          enumeratorKind = enumKind, fileEnum = fileEnum, adoObjectVar = adoVar,
          nodeListEnum = nodeList,
          constraints = parseConstraints(e, warnings)))
      case "" => None
      case other =>
        warnings += s"Task '$name' of type $other requires manual review"
        Some(UnsupportedTask(name, desc, other, s"unsupported executable type $other"))
    }
  }

  /** A `<path>` edge. Accepts both SSIS refId spellings
    * (`Package\Flow\Comp.Outputs[route]` / `...Inputs[Merge Join Left
    * Input]`) and the bare `Comp` / `Comp.Outputs[route]` forms: the
    * component name is the last `\`-segment before any `.Outputs[...]` /
    * `.Inputs[...]` suffix; the bracket text is the output route (split
    * branch) or input side ("left"/"right" recognized anywhere in a
    * MergeJoin input name). */
  private def parsePath(p: Node): Option[FlowPath] = {
    def split(ref: String): (String, Option[String]) = {
      val local = ref.split('\\').lastOption.getOrElse(ref)
      val m = """(.*?)\.(?:Outputs|Inputs)\[(.*)\]""".r
      local match {
        case m(comp, port) => (comp, Some(port).filter(_.nonEmpty))
        case other => (other, None)
      }
    }
    for {
      start <- attr(p, "startId")
      end <- attr(p, "endId")
    } yield {
      val (from, fromOutput) = split(start)
      val (to, toPort) = split(end)
      val toInput = toPort.map(_.toLowerCase).collect {
        case s if s.contains("left") => "left"
        case s if s.contains("right") => "right"
      }
      FlowPath(from, fromOutput, to, toInput)
    }
  }

  private def propText(c: Node, prop: String): Option[String] =
    (c \\ "property").find(p => p.attribute("name").exists(_.text == prop))
      .map(_.text).filter(_.nonEmpty)

  /** Shared column-type extraction: one definition for source/dest/
    * lookup/derived columns (was copy-pasted three times), with
    * `.toIntOption` guards — a hand-edited `length="255 "` must degrade,
    * never abort the whole package parse with NumberFormatException. */
  private def parseColumnType(oc: Node): SsisColumnType =
    SsisColumnType(
      name = oc.attribute("dataType").map(_.text).getOrElse("wstr"),
      length = oc.attribute("length").flatMap(_.text.trim.toIntOption),
      precision = oc.attribute("precision").flatMap(_.text.trim.toIntOption),
      scale = oc.attribute("scale").flatMap(_.text.trim.toIntOption))

  /** An SSIS error output repeats every column plus ErrorCode/ErrorColumn
    * — never part of the component's data contract. */
  private def dataOutputs(c: Node): List[Node] =
    (c \\ "output").toList.filterNot(
      _.attribute("isErrorOut").exists(_.text.equalsIgnoreCase("true")))

  private def parseOutputColumns(c: Node): List[ColumnInfo] =
    dataOutputs(c).flatMap(o => (o \\ "outputColumn").toList).map { oc =>
      ColumnInfo(
        name = oc.attribute("name").map(_.text).getOrElse(""),
        ssisType = parseColumnType(oc))
    }

  private def connectionRef(c: Node): Option[String] =
    (c \\ "connection").headOption.flatMap(_.attribute("connectionManagerRefId").map(_.text))

  private def parseComponent(
      c: Node, warnings: scala.collection.mutable.ListBuffer[String]): DataFlowComponent = {
    val name = c.attribute("name").map(_.text).getOrElse("")
    val classId = c.attribute("componentClassID").map(_.text).getOrElse("")
    val accessMode = propText(c, "AccessMode").flatMap(_.trim.toIntOption)
    classId match {
      case "Microsoft.OLEDBSource" | "Microsoft.FlatFileSource" | "Microsoft.ExcelSource" =>
        SourceComponent(name, classId.stripPrefix("Microsoft."),
          connectionRef(c), propText(c, "SqlCommand"), propText(c, "OpenRowset"),
          accessMode, parseOutputColumns(c))
      case "Microsoft.OLEDBDestination" | "Microsoft.FlatFileDestination" |
          "Microsoft.ExcelDestination" =>
        DestinationComponent(name, classId.stripPrefix("Microsoft."),
          connectionRef(c), propText(c, "OpenRowset"), accessMode, parseOutputColumns(c))
      case "Microsoft.Lookup" =>
        LookupComponent(name, connectionRef(c), propText(c, "SqlCommand"),
          cacheMode = if (propText(c, "CacheType").map(_.trim).contains("0")) CacheMode.Full
            else CacheMode.Partial,
          noMatchBehavior =
            if (propText(c, "NoMatchBehavior").map(_.trim).contains("0")) NoMatchBehavior.FailComponent
            else NoMatchBehavior.IgnoreFailure,
          inputColumns = (c \\ "inputColumn").toList
            .flatMap(ic => ic.attribute("cachedName").map(_.text)),
          outputColumns = parseOutputColumns(c))
      case "Microsoft.DerivedColumn" =>
        val cols = dataOutputs(c).flatMap(o => (o \\ "outputColumn").toList).flatMap { oc =>
          val expr = (oc \\ "property").find(_.attribute("name").exists(_.text == "Expression"))
            .map(_.text)
          expr.map { ex =>
            DerivedColumnDef(
              name = oc.attribute("name").map(_.text).getOrElse(""),
              expression = ex,
              friendlyExpression = (oc \\ "property")
                .find(_.attribute("name").exists(_.text == "FriendlyExpression")).map(_.text),
              outputType = parseColumnType(oc))
          }
        }
        DerivedColumnComponent(name, cols)
      case "Microsoft.ConditionalSplit" =>
        // outputs carry a FriendlyExpression/Expression property each;
        // document order defines evaluation priority (SSIS contract)
        val cases = dataOutputs(c).flatMap { o =>
          val oname = o.attribute("name").map(_.text).getOrElse("")
          val isDefault = o.attribute("isDefault").exists(_.text.equalsIgnoreCase("true")) ||
            (o \\ "property").isEmpty
          val expr = (o \\ "property").find(_.attribute("name").exists(_.text == "Expression"))
            .map(_.text)
          if (isDefault || expr.isEmpty) Nil else List(oname -> expr.get)
        }
        val default = dataOutputs(c).find { o =>
          o.attribute("isDefault").exists(_.text.equalsIgnoreCase("true")) ||
            (o \\ "property").isEmpty
        }.flatMap(_.attribute("name").map(_.text)).getOrElse("default")
        ConditionalSplitComponent(name, cases, default)
      case "Microsoft.Aggregate" =>
        // each outputColumn carries an AggregationType property:
        // groupby|sum|count|countdistinct|avg|min|max, and an
        // AggregationColumn property naming the input column
        val aggs = dataOutputs(c).flatMap(o => (o \\ "outputColumn").toList).flatMap { oc =>
          val outName = oc.attribute("name").map(_.text).getOrElse("")
          val fnTxt = (oc \\ "property").find(_.attribute("name").exists(_.text == "AggregationType"))
            .map(_.text.trim.toLowerCase)
          val inColOpt = (oc \\ "property").find(_.attribute("name").exists(_.text == "AggregationColumn"))
            .map(_.text.trim)
          val inCol = inColOpt.getOrElse(outName)
          fnTxt.map { f =>
            val fn = f match {
              case "groupby" | "group by" => AggFunction.GroupBy
              case "sum" => AggFunction.Sum
              // a count WITHOUT an AggregationColumn is SSIS's count-all
              // (COUNT(*)); with a column it counts that column's
              // non-null values (T-SQL COUNT(col))
              case "count" if inColOpt.isEmpty => AggFunction.CountAll
              case "count" => AggFunction.Count
              case "countall" | "count all" => AggFunction.CountAll
              case "countdistinct" | "count distinct" => AggFunction.CountDistinct
              case "avg" | "average" => AggFunction.Avg
              case "min" | "minimum" => AggFunction.Min
              case "max" | "maximum" => AggFunction.Max
              case other =>
                warnings += s"aggregate '$name': unknown aggregation type " +
                  s"'$other' for column '$outName' - column skipped, manual review"
                null
            }
            Option(fn).map(AggSpec(inCol, outName, _))
          }.flatten
        }
        AggregateComponent(name, aggs)
      case "Microsoft.MergeJoin" =>
        val jt = propText(c, "JoinType").map(_.trim) match {
          case Some("1") | Some("LEFT") => "LEFT"
          case Some("0") | Some("FULL") => "FULL"
          case _ => "INNER"
        }
        def keys(side: String) = propText(c, s"${side}Keys").map(_.split(",").map(_.trim)
          .filter(_.nonEmpty).toList).getOrElse(Nil)
        MergeJoinComponent(name, jt, keys("Left"), keys("Right"))
      case "Microsoft.UnionAll" => UnionAllComponent(name)
      case "Microsoft.Sort" =>
        val cols = (c \\ "inputColumn").toList.flatMap { ic =>
          ic.attribute("cachedName").orElse(ic.attribute("name")).map { n =>
            val asc = !ic.attribute("sortDescending").exists(_.text.equalsIgnoreCase("true"))
            n.text -> asc
          }
        }
        SortComponent(name, cols)
      case "Microsoft.RowCount" =>
        RowCountComponent(name, propText(c, "VariableName").getOrElse("User::RowCount"))
      case "Microsoft.DataConversion" =>
        val convs = (c \\ "outputColumn").toList.map { oc =>
          val src = (oc \\ "property").find(_.attribute("name").exists(_.text == "SourceInputColumn"))
            .map(_.text.trim)
            .getOrElse(oc.attribute("name").map(_.text).getOrElse("").stripSuffix("_conv"))
          src -> SsisColumnType(
            name = oc.attribute("dataType").map(_.text).getOrElse("wstr"),
            length = oc.attribute("length").map(_.text.toInt),
            precision = oc.attribute("precision").map(_.text.toInt),
            scale = oc.attribute("scale").map(_.text.toInt))
        }
        DataConversionComponent(name, convs)
      case other =>
        warnings += s"Component '$name' of class $other not parsed"
        UnparsedComponent(name, other)
    }
  }
}
