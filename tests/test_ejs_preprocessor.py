"""Ported reference goldens: jssrc2cpg EjsPreprocessorTests.scala —
byte-exact preprocess() parity (the north-star's byte-identical extracted
text contract).  The two whole-file goldens are verbatim transcriptions of
EjsPreprocessorTests.scala:10-150."""

from __future__ import annotations

from joern_spark.extract import preprocess_ejs

# EjsPreprocessorTests.scala:9-89 (script block)
CODE_SCRIPT_BLOCK = '\n<!DOCTYPE html>\n<html lang="en">\n<head>\n    <% include ../common/head %>\n</head>\n<body>\n    <% include ../common/navigation %>\n    <div class=\'container\' style=\'min-height: 450px\'><div class=\'row\'><div class=\'col-md-12\'>\n\n        <div class=\'row\'>\n            <div class=\'col-md-12\'>\n                <div class=\'page-header\'>\n                    <h2>Admin Dashboard</h2>\n\t                </div>\n                <div id=\'admin-body\' class=\'page-body\'>\n                    <a href=\'/app/admin/users\'>List Users</a><br>\n                </div>\n                <div id=\'user-body\' class=\'page-body\'>\n                    You are not an Admin<br>\n                </div>\n            </div>\n         </div>\n    </div></div></div>\n    <% include ../common/footer %>\n</body>\n    <script>\n        var isAdmin = <%=admin%>;\n        if(!isAdmin){\n            var div = document.getElementById(\'admin-body\');\n            div.style.display = "none";\n        }else{\n            var div = document.getElementById(\'user-body\');\n            div.style.display = "none";            \n        }\n    </script>\n</html>\n'

EXPECTED_SCRIPT_BLOCK = '\n               \n                \n      \n                                \n       \n      \n                                      \n                                                                                             \n\n                         \n                                   \n                                         \n                                            \n                       \n                                                       \n                                                                 \n                      \n                                                      \n                                            \n                      \n                  \n               \n                      \n                                  \n       \n            \n        var isAdmin =    admin  ;\n        if(!isAdmin){\n            var div = document.getElementById(\'admin-body\');\n            div.style.display = "none";\n        }else{\n            var div = document.getElementById(\'user-body\');\n            div.style.display = "none";            \n        }\n             \n       \n'


def test_replace_with_script_block():
    assert preprocess_ejs(CODE_SCRIPT_BLOCK) == EXPECTED_SCRIPT_BLOCK

# EjsPreprocessorTests.scala:91-150 (all tag kinds)
CODE_TAGS = '\n<body>\n\n<h1>Welcome <%= user.name %></h1>\n\n<b><%_ foo.callWithWhitespaces() _%></b>\n\n<b><%- foo.callUnescaped() -%></b>\n\n<%# Just a comment here #%>\n<% if (admin) { %>\n    <a href="/admin">Admin</a>\n<% } %>\n\n<ul>\n    <% friends.forEach(function(friend, index) { %>\n        <li class="<%= index === 0 ? "first" : "" %> <%= friend.name === selected ? "selected" : "" %>"><%= friend.name %></li>\n    <% }); %>\n</ul>\n\n<%\nconsole.log(user);\nexampleWrite = \'some value\';\n%>\n\n</body>\n'

EXPECTED_TAGS = '\n      \n\n            ap( user.name );     \n\n       foo.callWithWhitespaces() ;      \n\n   ap( foo.callUnescaped() );     \n\n                           \n   if (admin) {   \n                              \n   }   \n\n    \n       friends.forEach(function(friend, index) {   \n                   ap( index === 0 ? "first" : "" ); ap( friend.name === selected ? "selected" : "" );  ap( friend.name );     \n       });   \n     \n\n  \nconsole.log(user);\nexampleWrite = \'some value\';\n  \n\n       \n'


def test_replace_all_tag_kinds():
    assert preprocess_ejs(CODE_TAGS) == EXPECTED_TAGS


# EjsPreprocessorTests.scala:152-169 (small cases)
def test_escaped_output_tag():
    assert preprocess_ejs("<%= user.name %>") == "ap( user.name );"


def test_unescaped_output_tag_trim_close():
    assert preprocess_ejs("<%- foo.bar() -%>") == "ap( foo.bar() ); "


def test_output_tag_no_spaces_keeps_length():
    out = preprocess_ejs("<%=x%>")
    assert out == "ap(x);"
    assert len(out) == len("<%=x%>")


def test_scriptlet_control_flow_unwrapped():
    assert preprocess_ejs("<% if (a) { %>") == "   if (a) {   "
